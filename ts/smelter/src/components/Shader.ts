/**
 * Shader — user-registered compute applied to child textures.
 * Wire schema: smelter_tpu/api/schema.py `Shader`; params convert to the
 * tagged wire form (reference behavior: smelter-render/src/transformations/
 * shader.rs).
 */
import type * as Api from '../api.js';
import type { ComponentBaseProps } from '../scene.js';
import { sceneNodeFromSpec } from '../scene.js';

export type ShaderParam =
  | { type: 'f32'; value: number }
  | { type: 'u32'; value: number }
  | { type: 'i32'; value: number }
  | { type: 'list'; value: ShaderParam[] }
  | { type: 'struct'; value: ShaderParamStructField[] };

export type ShaderParamStructField = ShaderParam & { fieldName: string };

export type ShaderProps = ComponentBaseProps & {
  /** Id the shader was registered with. */
  shaderId: Api.RendererId;
  /** Value bound to the shader's params argument. */
  shaderParam?: ShaderParam;
  /** Output texture resolution. */
  resolution: Api.Resolution;
};

/** Uniformly recursive camelCase → wire conversion of a param tree. */
export function intoApiShaderParam(param: ShaderParam): Api.ShaderParam {
  switch (param.type) {
    case 'list':
      return { type: 'list', value: param.value.map(intoApiShaderParam) };
    case 'struct':
      return {
        type: 'struct',
        value: param.value.map(field => ({
          field_name: field.fieldName,
          ...intoApiShaderParam(field),
        })),
      };
    default:
      return { type: param.type, value: param.value };
  }
}

const Shader = sceneNodeFromSpec<ShaderProps>('shader', {
  rootFields: ['shaderId', 'shaderParam', 'resolution'],
  transforms: { shaderParam: intoApiShaderParam },
});

export default Shader;
