/** Shader component (wire: Shader; params convert to the tagged wire form). */
import type * as Api from '../api.js';
import type { ComponentBaseProps, SceneComponent } from '../component.js';
import { createSmelterComponent, sceneComponentIntoApi } from '../component.js';

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

function intoApiShaderParam(param: ShaderParam): Api.ShaderParam {
  switch (param.type) {
    case 'f32':
    case 'u32':
    case 'i32':
      return { type: param.type, value: param.value };
    case 'list':
      return { type: 'list', value: param.value.map(intoApiShaderParam) };
    case 'struct':
      return {
        type: 'struct',
        value: param.value.map(field => ({
          field_name: field.fieldName,
          type: field.type,
          value:
            field.type === 'list'
              ? (field.value as ShaderParam[]).map(intoApiShaderParam)
              : field.type === 'struct'
                ? (field.value as ShaderParamStructField[]).map(f => ({
                    field_name: f.fieldName,
                    type: f.type,
                    value: f.value,
                  }))
                : field.value,
        })),
      };
  }
}

function sceneBuilder(props: ShaderProps, children: SceneComponent[]): Api.Component {
  return {
    type: 'shader',
    id: props.id,
    children: children.map(sceneComponentIntoApi),
    shader_id: props.shaderId,
    shader_param: props.shaderParam && intoApiShaderParam(props.shaderParam),
    resolution: props.resolution,
  };
}

const Shader = createSmelterComponent<ShaderProps>(sceneBuilder);
export default Shader;
