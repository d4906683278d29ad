#!/usr/bin/env node
/**
 * create-smelter-app: scaffold a smelter-tpu project from a template.
 *
 *   npx @smelter-tpu/create-smelter-app my-app [--template node-minimal]
 */
import { promises as fs } from 'fs';
import path from 'path';
import { fileURLToPath } from 'url';
import prompts from 'prompts';

const TEMPLATES = ['node-minimal'];

async function copyDir(src: string, dst: string): Promise<void> {
  await fs.mkdir(dst, { recursive: true });
  for (const entry of await fs.readdir(src, { withFileTypes: true })) {
    const from = path.join(src, entry.name);
    const to = path.join(dst, entry.name);
    if (entry.isDirectory()) {
      await copyDir(from, to);
    } else {
      await fs.copyFile(from, to);
    }
  }
}

async function main(): Promise<void> {
  const args = process.argv.slice(2);
  let target = args.find(a => !a.startsWith('--'));
  const templateFlag = args.indexOf('--template');
  let template = templateFlag >= 0 ? args[templateFlag + 1] : undefined;

  if (!target) {
    const answer = await prompts({
      type: 'text',
      name: 'dir',
      message: 'Project directory',
      initial: 'smelter-app',
    });
    target = answer.dir as string;
  }
  if (!template) {
    const answer = await prompts({
      type: 'select',
      name: 'template',
      message: 'Template',
      choices: TEMPLATES.map(name => ({ title: name, value: name })),
    });
    template = answer.template as string;
  }
  if (!TEMPLATES.includes(template)) {
    console.error(`Unknown template "${template}". Available: ${TEMPLATES.join(', ')}`);
    process.exit(1);
  }

  const here = path.dirname(fileURLToPath(import.meta.url));
  const templateDir = path.resolve(here, '../templates', template);
  const targetDir = path.resolve(process.cwd(), target);
  await copyDir(templateDir, targetDir);

  const pkgPath = path.join(targetDir, 'package.json');
  const pkg = JSON.parse(await fs.readFile(pkgPath, 'utf-8'));
  pkg.name = path.basename(targetDir);
  await fs.writeFile(pkgPath, JSON.stringify(pkg, null, 2));

  console.log(`Created ${target} from template ${template}.`);
  console.log('Next steps:');
  console.log(`  cd ${target}`);
  console.log('  npm install');
  console.log('  npm start   # needs a running smelter-tpu server');
}

void main();
